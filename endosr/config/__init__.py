from endosr.config import options
from endosr.config.options import (
    NoneDict,
    check_resume,
    dict2str,
    dict_to_nonedict,
    parse,
)

__all__ = ["options", "parse", "dict2str", "NoneDict", "dict_to_nonedict",
           "check_resume"]
