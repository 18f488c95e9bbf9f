from .generator import make_fixtures  # noqa: F401
