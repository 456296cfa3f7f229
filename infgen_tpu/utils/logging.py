"""Process-aware logging (reference utils/func.py Logging:80 /
RankedLogger:125): messages carry the jax process index; non-zero processes
log only when asked."""

import logging
import sys
from typing import Optional


def get_logger(name: str = "infgen_tpu", log_file: Optional[str] = None,
               rank_zero_only: bool = True) -> logging.Logger:
    import jax

    rank = jax.process_index()
    logger = logging.getLogger(f"{name}.r{rank}")
    if not logger.handlers:
        fmt = logging.Formatter(
            f"%(asctime)s [rank {rank}] %(levelname)s %(message)s", "%H:%M:%S")
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_file:
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
        logger.setLevel(logging.INFO)
        if rank_zero_only and rank != 0:
            logger.setLevel(logging.WARNING)
    return logger


def maybe_wandb_init(project: str, config: dict):
    """Optional wandb run (reference run.py:93-96); no-op when unavailable.

    Defaults to offline mode (local run files, no network) unless WANDB_MODE
    says otherwise — training environments may have no egress."""
    import os

    try:
        import wandb
        return wandb.init(project=project, config=config,
                          mode=os.environ.get("WANDB_MODE", "offline"))
    except Exception:
        return None
