from .base import BaseHandler  # noqa: F401
from .sa import SAHandler  # noqa: F401
from .vlsa import VLSAHandler  # noqa: F401
from .clf import CLFHandler  # noqa: F401
