from .mapping_plan import AttributeMapping, MappingPlan

__all__ = ["AttributeMapping", "MappingPlan"]
