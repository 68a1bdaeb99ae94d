from .batcher import MicroBatcher
from .client import CaptioningClient
from .server import CaptionService, serve
