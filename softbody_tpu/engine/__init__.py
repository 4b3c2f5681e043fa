"""Runtime engine: host façade + worker thread + protocol + FIFO lock
(components C1/C2/C3/C5, SURVEY.md §2.1)."""

from .engine import Engine, LatticeEngine  # noqa: F401
from .lock import FifoLock  # noqa: F401
from .protocol import EngineOptions, Message, MessageType  # noqa: F401
from .worker import EngineStats, EngineWorker, RenderPacket  # noqa: F401
