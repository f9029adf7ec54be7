"""Logging setup (``utils/utilities.py:29-63``)."""

from __future__ import annotations

import logging
import os


def get_filename(path: str) -> str:
    name_ext = os.path.realpath(path).split('/')[-1]
    return os.path.splitext(name_ext)[0]


def create_logging(log_dir: str, filemode: str = 'w') -> logging.Logger:
    """File + console logging with sequentially numbered log files."""
    os.makedirs(log_dir, exist_ok=True)
    i = 0
    while os.path.isfile(os.path.join(log_dir, f'{i:04d}.log')):
        i += 1
    log_path = os.path.join(log_dir, f'{i:04d}.log')
    logging.basicConfig(
        level=logging.DEBUG,
        format=('%(asctime)s %(filename)s[line:%(lineno)d] %(levelname)s '
                '%(message)s'),
        datefmt='%a, %d %b %Y %H:%M:%S',
        filename=log_path,
        filemode=filemode,
        force=True)
    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.setFormatter(
        logging.Formatter('%(name)-12s: %(levelname)-8s %(message)s'))
    logging.getLogger('').addHandler(console)
    # keep framework debug out of the root DEBUG stream
    for noisy in ('jax', 'jax._src', 'orbax', 'absl', 'h5py'):
        logging.getLogger(noisy).setLevel(logging.INFO)
    return logging
