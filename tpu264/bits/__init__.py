from .bitwriter import BitSink, pack_bits
from .bitreader import BitReader
from . import expgolomb
from . import nal
