from .tables import (Params, VegParams, SoilParams, GenParams,
                     load_params, load_veg_params, load_soil_params,
                     load_gen_params, DATA_DIR, VEG_SCHEMES, SOIL_SCHEMES)

__all__ = ["Params", "VegParams", "SoilParams", "GenParams",
           "load_params", "load_veg_params", "load_soil_params",
           "load_gen_params", "DATA_DIR", "VEG_SCHEMES", "SOIL_SCHEMES"]
