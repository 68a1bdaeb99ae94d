from .batcher import MicroBatcher
from .server import CaptionService, serve
