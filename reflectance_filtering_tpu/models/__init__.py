from .caffe_io import load_caffemodel_weights, load_reference_weights  # noqa: F401
from .networks import (  # noqa: F401
    NetworkConfig,
    create_network,
    reflectance_net_apply,
)
from .recover import recover_reflectance_shading  # noqa: F401
