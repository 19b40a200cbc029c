from lambdo_spark.plans.compiler import Workflow, compile_workflow, stratify

__all__ = ["Workflow", "compile_workflow", "stratify"]
