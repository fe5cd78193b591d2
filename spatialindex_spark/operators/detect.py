"""Source detection + astrometry: extract point sources from image
pixels and place them on the sky (the catalog-extraction step that
FEEDS the reference's cell-indexed tables — README.md:9-24's position
catalogs are the OUTPUT of exactly this pipeline stage; crossmatch (J3)
then matches the fresh detections against a reference catalog).

Scale shape (100 TB)
--------------------
Detection is embarrassingly parallel: ``mapInPandas`` over the image
rows (pixels never shuffle, never leave their partition; the output is
a few dozen bytes per detection).  The pixel->sky conversion is pure
JVM Column trig on the detection rows — the inverse of the gnomonic
(TAN) window math in operators/cutouts.py, same geometry model.  The
combined plan is one Arrow pass over the scan followed by whole-stage
codegen; no shuffle at all until a downstream groupBy/crossmatch.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["detect_sources"]


def detect_sources(images: DataFrame, scale_deg_px: float,
                   threshold: int = 255,
                   image_id: str = "image_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """Every pixel whose channels all reach ``threshold``, as a source
    row with continuous pixel-center coordinates and sky position.

    ``images`` needs (image_id, bytes, w, h, fmt, ra, dec) — the same
    gnomonic pointing model as the cutout/mosaic operators (TAN about
    (ra, dec), RA toward -x, Dec toward +y, pixel (i, j) centered at
    (i + 0.5, j + 0.5)).

    Output: image_id, src_x, src_y (integer pixel), px, py (pixel
    center), ra, dec (degrees, 1e-6-rounded — JVM inverse-TAN of the
    pixel center about the pointing).

    Single-pixel thresholding is the exact-recovery detector for
    planted-spike payloads (imaging.synth_image_sources); real survey
    detection (PSF matched filters, deblending) would swap the kernel
    inside the same mapInPandas plumbing without touching the plan
    shape.
    """
    from ..sources import imaging

    sel = images.select(F.col(image_id).alias("image_id"), "ra", "dec",
                        "w", "h", "fmt", F.col(bytes_col).alias("payload"))

    def find(batches):
        for b in batches:
            out = {"image_id": [], "ra": [], "dec": [], "w": [], "h": [],
                   "src_x": [], "src_y": []}
            for r in b.itertuples(index=False):
                img = imaging.decode(r.payload, int(r.w), int(r.h), str(r.fmt))
                mask = (img >= threshold).all(axis=2)
                ys, xs = np.nonzero(mask)
                for x, y in zip(xs, ys):
                    out["image_id"].append(r.image_id)
                    out["ra"].append(float(r.ra))
                    out["dec"].append(float(r.dec))
                    out["w"].append(int(r.w))
                    out["h"].append(int(r.h))
                    out["src_x"].append(int(x))
                    out["src_y"].append(int(y))
            yield pd.DataFrame(out)

    det = sel.mapInPandas(
        find, "image_id long, ra double, dec double, w int, h int, "
              "src_x int, src_y int")

    # inverse TAN (JVM Column trig): pixel center -> tangent-plane
    # (xi, eta) -> unit vector in the (east, north, center) basis at the
    # pointing -> (ra, dec). Exact inverse of cutouts._tan_px_cols.
    s = F.lit(math.radians(scale_deg_px))
    pxc = F.col("src_x") + F.lit(0.5)
    pyc = F.col("src_y") + F.lit(0.5)
    xi = (F.col("w") / F.lit(2.0) - pxc) * s
    eta = (pyc - F.col("h") / F.lit(2.0)) * s
    a0, d0 = F.radians("ra"), F.radians("dec")
    den = F.sqrt(F.lit(1.0) + xi * xi + eta * eta)
    gx = (F.cos(d0) * F.cos(a0) - xi * F.sin(a0)
          - eta * F.sin(d0) * F.cos(a0)) / den
    gy = (F.cos(d0) * F.sin(a0) + xi * F.cos(a0)
          - eta * F.sin(d0) * F.sin(a0)) / den
    gz = (F.sin(d0) + eta * F.cos(d0)) / den
    ra = F.pmod(F.degrees(F.atan2(gy, gx)) + F.lit(360.0), F.lit(360.0))
    dec = F.degrees(F.asin(F.least(F.greatest(gz, F.lit(-1.0)),
                                   F.lit(1.0))))
    return det.select(
        "image_id", "src_x", "src_y",
        F.round(pxc, 6).alias("px"), F.round(pyc, 6).alias("py"),
        F.round(ra, 6).alias("src_ra"), F.round(dec, 6).alias("src_dec"))
