from .envlight import ConstantEnv, TextureEnv, NifEnv, eval_env
from .nif import NifMetaData, NifWeights, load_nif_assets, nif_apply, analyse_nif
