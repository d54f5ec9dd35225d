from .knn_pallas import HAVE_PALLAS, knn_pallas

__all__ = ["HAVE_PALLAS", "knn_pallas"]
