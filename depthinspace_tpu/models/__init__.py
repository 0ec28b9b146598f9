from .dispnet import DispNet, SigmoidAffineHead
from .fusenet import FuseNet, Block2D3D, PointConv, ResNetBlock
