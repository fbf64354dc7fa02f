from .table import LakeTable  # noqa: F401
