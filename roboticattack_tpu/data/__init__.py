from .collator import batch_iterator, collate
from .dummy import dummy_frame_iterator
from .prefetch import device_prefetch
