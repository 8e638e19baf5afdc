from yolo_dual_tpu.utils.general import (
    LOGGER,
    colorstr,
    check_img_size,
    increment_path,
    init_seeds,
    make_divisible,
    yaml_load,
    yaml_save,
    Profile,
)

__all__ = [
    "LOGGER",
    "colorstr",
    "check_img_size",
    "increment_path",
    "init_seeds",
    "make_divisible",
    "yaml_load",
    "yaml_save",
    "Profile",
]
