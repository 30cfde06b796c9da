from . import charge, potential, current, heat, events  # noqa: F401
