from .compile import CompileOptions, MappingCompiler  # noqa: F401
