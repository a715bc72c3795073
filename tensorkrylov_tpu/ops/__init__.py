from . import banded, eigen, expsum, gram, orth
