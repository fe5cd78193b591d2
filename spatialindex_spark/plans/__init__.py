from .session import get_session, cluster_by_cell  # noqa: F401
