from .autoload import SchemaRegistry, infer_schema, read_file_stream

__all__ = ["SchemaRegistry", "infer_schema", "read_file_stream"]
