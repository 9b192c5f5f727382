from .harvest import discover_datastreams, harvest_observations
from .xlsx_star import load_xlsx_star

__all__ = ["discover_datastreams", "harvest_observations", "load_xlsx_star"]
