from .audio import AudioIO, AudioAugmentor
from .metrics import Metrics
from .filter import Filter
from .sampler import SpeakerSampler
