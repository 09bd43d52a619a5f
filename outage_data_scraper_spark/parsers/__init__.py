from .registry import FAMILY_BY_STATE_LAYOUT, family_for  # noqa: F401
