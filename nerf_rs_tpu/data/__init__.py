from . import blender, device_dataset, factory, images, pipeline, synthetic  # noqa: F401
from .device_dataset import DeviceDataset  # noqa: F401
from .factory import make_dataset  # noqa: F401
