from .sampling import bilinear_sample, warp, resize_bilinear, resize_flow, resize_mask
from .lcn import lcn, box_sum
from .sobel import sobel
from .geometry import (pixel_rays, unproject, project, reproject,
                       disp_to_depth, depth_to_disp)
from .census import census_sad, census_sad_oracle, photometric_dissimilarity
from .matching import nn_search, crosscheck, proj_nn, xcorrvol
from .resample import warp_pattern, flow_warp
