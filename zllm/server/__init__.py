from .engine import Engine, Request
from .http import ZllmServer
