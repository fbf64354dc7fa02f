from .customer360 import Customer360Config, build_customer360, run_customer360

__all__ = ["Customer360Config", "build_customer360", "run_customer360"]
