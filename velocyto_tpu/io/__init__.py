from . import loom
from .loom import connect, create, LoomConnection

__all__ = ["loom", "connect", "create", "LoomConnection"]
