from .delta_interop import DeltaInteropTable, is_delta_table  # noqa: F401
from .table import LakeTable  # noqa: F401
