"""Named-logger subsystem — the reference's easylogging++ setup
(src/Logging.cpp:6-27, include/Logging.h).

The reference creates 9 named loggers (LOGGER_SYS/INIT/ROUND/COMPARE/RECO/
MPI/FFT/GPU/MEM) writing to one ``thunder.log``, INFO to file but NOT to
stdout (Logging.cpp:15-16), with role-scoped macros MLOG/ALOG/BLOG
(include/Parallel.h:70-98). Here the same taxonomy rides Python logging:
one file handler on the ``thunder`` root logger, children per subsystem
(MPI -> MESH, GPU -> TPU), and the process role (host index) baked into
the format instead of per-role macros — in SPMD there is one program, so
"which hemisphere said this" becomes "which host said this".
"""

import logging
import os

#: reference logger taxonomy (src/Logging.cpp:19-20), renamed where the
#: mechanism changed: MPI -> MESH (jax collectives), GPU -> TPU
LOGGER_NAMES = ("SYS", "INIT", "ROUND", "COMPARE", "RECO", "MESH", "FFT",
                "TPU", "MEM")

_ROOT = "thunder"
_initialised = False


def init_logger(directory="./", filename="thunder.log", process_index=0,
                echo=False, level=logging.INFO):
    """Configure the thunder.log file handler (initLogger,
    src/Logging.cpp:6-27). INFO goes to the file, not stdout, unless
    ``echo``. Safe to call repeatedly; the last call wins."""
    global _initialised
    root = logging.getLogger(_ROOT)
    root.setLevel(level)
    root.propagate = False
    for h in list(root.handlers):
        root.removeHandler(h)
    os.makedirs(directory or "./", exist_ok=True)
    path = os.path.join(directory or "./", filename)
    fh = logging.FileHandler(path)
    fh.setFormatter(logging.Formatter(
        f"%(asctime)s %(levelname)s [host {process_index}]"
        " [%(name)s] %(message)s"))
    root.addHandler(fh)
    if echo:
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter("%(levelname)s [%(name)s] %(message)s"))
        root.addHandler(sh)
    for name in LOGGER_NAMES:
        logging.getLogger(f"{_ROOT}.{name}")
    _initialised = True
    return path


def get_logger(name="SYS"):
    """Named logger, e.g. get_logger('ROUND') — LOGGER_ROUND."""
    if name not in LOGGER_NAMES:
        raise ValueError(f"unknown logger {name!r}; one of {LOGGER_NAMES}")
    return logging.getLogger(f"{_ROOT}.{name}")
