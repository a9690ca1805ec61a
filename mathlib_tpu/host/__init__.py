from .engine import HostEngine, get_engine  # noqa: F401
from .fields import Tower, get_tower  # noqa: F401
