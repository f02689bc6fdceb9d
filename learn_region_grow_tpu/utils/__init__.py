from . import class_util, io  # noqa: F401
