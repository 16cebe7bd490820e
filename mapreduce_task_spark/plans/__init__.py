from .signature import plan_signature, plan_attributes

__all__ = ["plan_signature", "plan_attributes"]
