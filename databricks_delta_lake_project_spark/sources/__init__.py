from .autoload import (
    EVOLUTION_MODES,
    NewColumnsError,
    SchemaRegistry,
    infer_schema,
    read_file_stream,
)

__all__ = [
    "EVOLUTION_MODES",
    "NewColumnsError",
    "SchemaRegistry",
    "infer_schema",
    "read_file_stream",
]
