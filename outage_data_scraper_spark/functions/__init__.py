from . import textkit, urlkit  # noqa: F401
