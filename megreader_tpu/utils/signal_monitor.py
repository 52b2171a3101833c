"""SignalMonitor: touch-file polling for graceful actions during training.

The reference's only fault-tolerance artifact (``concern/signal_monitor.py``
[U], SURVEY.md §5.3): poll a filesystem flag file; when it appears, request
an orderly save/exit. Kept API-compatible in spirit; the trainer checks it
once per epoch and once per log interval.
"""

from __future__ import annotations

import os
from typing import Optional

from ..core.registry import register


@register
class SignalMonitor:
    def __init__(self, signal_path: Optional[str] = None):
        self.signal_path = signal_path

    def should_stop(self) -> bool:
        if not self.signal_path:
            return False
        if os.path.exists(self.signal_path):
            try:
                os.remove(self.signal_path)  # consume the signal
            except OSError:
                pass
            return True
        return False
