from .state import TrainState
from .objective import LossContext, make_loss_context, sf_losses, mf_losses
from .steps import build_steps, build_steps_aot
from .worker import Worker, TestSet
from .single_frame import SingleFrameWorker
from .multi_frame import MultiFrameWorker
