from .photometric import photometric_loss, warp_pattern_by_disparity
from .smoothness import smoothness_loss
from .geometric import (CameraGeometry, flow_consistency_sf,
                        flow_consistency_mf, geometric_loss_sf,
                        geometric_loss_mf, pairwise_indices)
from .extra import ssim, projection_depth_similarity_loss, occlusion_mask
