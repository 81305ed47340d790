from .boxfilter import box_filter  # noqa: F401
from .guided import guided_filter, guided_filter_u8  # noqa: F401
from .bilateral import joint_bilateral_filter, joint_bilateral_filter_u8  # noqa: F401
