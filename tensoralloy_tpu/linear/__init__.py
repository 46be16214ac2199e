from .model import LinearTensorMD, TensorMDPythonCalculator  # noqa
