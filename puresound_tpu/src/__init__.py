from .audio import AudioIO, AudioAugmentor
from .metrics import Metrics
from .filter import Filter, wav_drop_chunk, wav_drop_frequency
from .sampler import SpeakerSampler
