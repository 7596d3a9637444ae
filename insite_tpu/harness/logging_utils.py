"""Timestamped log files whose lines double as the results database
(reference: utils/logging_utils.py:5-24)."""

from __future__ import annotations

import logging
import os
import time


def generate_log_file_path(name: str = 'run', log_folder: str = 'logs'):
    os.makedirs(log_folder, exist_ok=True)
    stamp = time.strftime('%Y%m%d-%H%M%S')
    return os.path.join(log_folder, f'{name}-{stamp}.txt')


def create_logger_in_process(log_file_path: str,
                             name: str = 'insite_tpu') -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        logger.setLevel(logging.INFO)
        fmt = logging.Formatter('%(asctime)s %(levelname)s %(message)s')
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        fh = logging.FileHandler(log_file_path)
        fh.setFormatter(fmt)
        logger.addHandler(sh)
        logger.addHandler(fh)
    return logger
