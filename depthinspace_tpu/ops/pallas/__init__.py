from .census_kernel import census_sad_pallas, census_sad_auto
from .warp_kernel import xwarp_disparity, warp2d, warp2d_nhwc
