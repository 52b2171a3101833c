from .signal_monitor import SignalMonitor

__all__ = ["SignalMonitor"]
