"""Logging + experiment management.

Replaces the reference's colorlogger / Experimenter pair
(snvc/utils/logger_utils.py:16-49, exp_utils.py:11-73): an ANSI-colored
console+file logger and an experiment directory manager that persists the
typed JSON config next to checkpoints ("config travels with weights")
instead of exec-importing a save_config.py.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_COLORS = {
    logging.DEBUG: "\033[36m",
    logging.INFO: "\033[32m",
    logging.WARNING: "\033[33m",
    logging.ERROR: "\033[31m",
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelno, "")
        return f"{color}{msg}{_RESET}" if sys.stderr.isatty() else msg


def get_logger(name: str = "snvc_tpu", log_file: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = "%(asctime)s %(levelname)s %(name)s: %(message)s"
    sh = logging.StreamHandler()
    sh.setFormatter(_ColorFormatter(fmt))
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter(fmt))
        logger.addHandler(fh)
    return logger


class Experimenter:
    """Experiment directory: config + logs + checkpoints + metrics."""

    def __init__(self, model_dir: str, config=None):
        from snvc_tpu.config import ExperimentConfig, VernierConfig, load_config, save_config

        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        cfg_path = os.path.join(self.model_dir, "config.json")
        if config is not None:
            save_config(config, cfg_path)
            self.config = config
        elif os.path.exists(cfg_path):
            # stored configs may be a VernierConfig or a full ExperimentConfig
            import json

            with open(cfg_path) as f:
                d = json.load(f)
            cls = ExperimentConfig if "vernier" in d else VernierConfig
            self.config = cls.from_dict(d)
        else:
            raise FileNotFoundError(f"no config.json in {self.model_dir}")
        self.logger = get_logger(
            "snvc_tpu", os.path.join(self.model_dir, "training.log")
        )

    @property
    def checkpoint_dir(self) -> str:
        return os.path.join(self.model_dir, "checkpoints")

    def metrics_writer(self):
        """Returns a callable(step, dict) appending JSONL metrics (a
        dependency-free stand-in for tensorboard; the files are trivially
        plottable)."""
        path = os.path.join(self.model_dir, "metrics.jsonl")

        def write(step: int, metrics: dict):
            import json

            with open(path, "a") as f:
                f.write(json.dumps({"step": step, **metrics}) + "\n")

        return write
