from .params import CurveID, CurveSpec, get_spec  # noqa: F401
