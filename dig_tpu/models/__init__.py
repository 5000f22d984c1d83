from .schnet import SchNet
from .spherenet import DimeNetPP, SphereNet

__all__ = ["SchNet", "SphereNet", "DimeNetPP"]
