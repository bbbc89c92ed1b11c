from .export import (
    emit_vgg_header,
    parse_vgg_header,
    export_opencv,
)
from .stages import Workspace

__all__ = [
    "emit_vgg_header",
    "parse_vgg_header",
    "export_opencv",
    "Workspace",
]
