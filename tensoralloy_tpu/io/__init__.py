from .extxyz import read_extxyz, write_extxyz, iread_extxyz  # noqa: F401
