from .schnet import SchNet

__all__ = ["SchNet"]
