from cosmo_spark.plans.explain import physical_plan, plan_has, scan_read_schema

__all__ = ["physical_plan", "plan_has", "scan_read_schema"]
