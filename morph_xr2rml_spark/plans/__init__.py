from .session import attach_package, build_session  # noqa: F401
