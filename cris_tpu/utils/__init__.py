from .config import CfgNode, load_cfg_from_cfg_file, merge_cfg_from_list
from .logging import (
    AverageMeter,
    ExperimentTracker,
    ProgressMeter,
    log_exceptions,
    logger,
    setup_logger,
)
from .profiling import StepTimer, annotate, trace
from .seed import epoch_key, init_random_seed, root_key, worker_seed
from .tokenizer import ClipBPETokenizer, get_tokenizer, tokenize

__all__ = [
    "CfgNode",
    "load_cfg_from_cfg_file",
    "merge_cfg_from_list",
    "AverageMeter",
    "ProgressMeter",
    "ExperimentTracker",
    "logger",
    "log_exceptions",
    "StepTimer",
    "annotate",
    "trace",
    "setup_logger",
    "init_random_seed",
    "root_key",
    "epoch_key",
    "worker_seed",
    "ClipBPETokenizer",
    "get_tokenizer",
    "tokenize",
]
