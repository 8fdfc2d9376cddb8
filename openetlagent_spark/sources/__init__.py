from .io import save_data, scan_data

__all__ = ["save_data", "scan_data"]
