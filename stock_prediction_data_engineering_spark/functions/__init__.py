from .exact import davg, dsum  # noqa: F401
from .cleaning import clean_money, clean_percent  # noqa: F401
