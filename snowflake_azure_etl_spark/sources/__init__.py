from .registry import SourceRegistry, Stage, load_tables, register_star_views

__all__ = ["SourceRegistry", "Stage", "load_tables", "register_star_views"]
