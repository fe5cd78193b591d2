from .session import cluster_by_cell, get_session, write_clustered  # noqa: F401
