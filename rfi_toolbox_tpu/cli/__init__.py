"""Console entry points (see pyproject [project.scripts])."""

__all__ = [
    "generate_dataset",
    "train_model",
    "evaluate_model",
    "normalize_data",
]
