from .dispnet import DispNet, SigmoidAffineHead
from .flownet import FlowNet
from .fusenet import FuseNet, Block2D3D, PointConv, ResNetBlock
from .heads import (MultiLinear, SigmoidAffine, DispRowHead, PosOutput,
                    make_output_head, pos_to_depth)
