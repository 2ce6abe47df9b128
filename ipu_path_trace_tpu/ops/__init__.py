from .nif_pallas import nif_apply_pallas
