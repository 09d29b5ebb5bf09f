from .catalog import SourceCatalog  # noqa: F401
