from . import rds

__all__ = ["rds"]
