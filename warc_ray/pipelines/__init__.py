"""End-to-end pipeline drivers (never call ``ray.init``)."""
