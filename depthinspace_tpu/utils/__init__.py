from . import metric, cmap, io3d, geometry3d, gtimer
from .args import parse_args, str2bool
from .misc import git_hash
from .jaxcfg import enable_compilation_cache
