from .schnet import SchNet
from .spherenet import DimeNetPP, SphereNet
from .comenet import ComENet
from .pronet import ProNet
from .schnet_dense import SchNetDense

__all__ = ["SchNet", "SphereNet", "DimeNetPP", "ComENet", "ProNet", "SchNetDense"]
