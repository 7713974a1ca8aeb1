"""Process-0 structured logging and training meters.

Mirrors the reference observability layer (loguru console+file logging and
AverageMeter/ProgressMeter, /root/reference/utils/misc.py:69-111,262-293)
using only the standard library, with optional wandb hooks that no-op when
wandb is unavailable.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Dict, List, Optional

_LOG_FORMAT = "%(asctime)s | %(levelname)-8s | %(name)s:%(lineno)d - %(message)s"
_DATE_FORMAT = "%Y-%m-%d %H:%M:%S"

logger = logging.getLogger("cris_tpu")


def setup_logger(
    save_dir: Optional[str] = None,
    process_index: int = 0,
    filename: str = "log.txt",
    mode: str = "a",
) -> logging.Logger:
    """Configure the package logger: stderr + file handlers on process 0 only.

    Same contract as the reference setup (/root/reference/utils/misc.py:262-293)
    -- non-zero processes stay silent.
    """
    logger.handlers.clear()
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if process_index != 0:
        logger.addHandler(logging.NullHandler())
        return logger

    formatter = logging.Formatter(_LOG_FORMAT, datefmt=_DATE_FORMAT)
    stream = logging.StreamHandler(sys.stderr)
    stream.setFormatter(formatter)
    logger.addHandler(stream)

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        path = os.path.join(save_dir, filename)
        if mode == "o" and os.path.exists(path):
            os.remove(path)
        fh = logging.FileHandler(path, mode="a")
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


class AverageMeter:
    """Tracks current value, running sum and mean of a scalar metric."""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        if self.name == "Lr":
            return ("{name}={val" + self.fmt + "}").format(**self.__dict__)
        return ("{name}={val" + self.fmt + "} ({avg" + self.fmt + "})").format(
            **self.__dict__
        )


class ProgressMeter:
    """Formats a batch counter plus a list of meters into one log line."""

    def __init__(self, num_batches: int, meters: List[AverageMeter], prefix: str = ""):
        digits = len(str(num_batches))
        self._fmt = "[{:" + str(digits) + "d}/" + f"{num_batches}]"
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self._fmt.format(batch)]
        entries += [str(m) for m in self.meters]
        logger.info("  ".join(entries))


def log_exceptions(fn):
    """Log uncaught exceptions through the package logger before re-raising
    (the stdlib equivalent of the reference's @logger.catch entry-point
    traps, train.py:54 / test.py:40)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception:
            logger.exception(f"uncaught exception in {fn.__name__}")
            raise

    return wrapper


class ExperimentTracker:
    """Optional wandb-compatible metric sink; silently no-ops without wandb."""

    def __init__(self, enabled: bool = True, **init_kwargs):
        self._run = None
        if not enabled:
            return
        try:  # pragma: no cover - wandb not installed in CI
            import wandb

            self._run = wandb.init(**init_kwargs)
        except Exception:
            self._run = None

    def log(self, metrics: Dict[str, float], step: Optional[int] = None):
        if self._run is not None:  # pragma: no cover
            self._run.log(metrics, step=step)

    def finish(self):
        if self._run is not None:  # pragma: no cover
            self._run.finish()
