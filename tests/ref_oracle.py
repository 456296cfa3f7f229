"""Import the reference implementation (read-only, /root/reference) for parity
tests, stubbing the heavyweight deps it pulls in at import time.

Only used by tests; the framework itself never imports the reference.
"""

import os
import sys
import types

# the reference's generated protobuf bindings predate the installed protobuf;
# the pure-python implementation accepts them
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

_REF = "/root/reference"


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def import_reference():
    if _REF not in sys.path:
        def _missing(name):
            try:
                __import__(name)
                return False
            except ImportError:
                return True

        if _missing("easydict"):
            class EasyDict(dict):
                def __getattr__(self, k):
                    return self[k]

                def __setattr__(self, k, v):
                    self[k] = v

            _stub("easydict", EasyDict=EasyDict)

        if _missing("rich"):
            class Console:
                def __init__(self, *a, **k):
                    pass

                def log(self, *a, **k):
                    pass

            rich = _stub("rich")
            rich.console = _stub("rich.console", Console=Console)

        if _missing("lightning_utilities"):
            lu = _stub("lightning_utilities")
            lu.core = _stub("lightning_utilities.core")
            lu.core.rank_zero = _stub(
                "lightning_utilities.core.rank_zero",
                rank_prefixed_message=lambda msg, rank: msg,
                rank_zero_only=lambda fn, default=None: fn,
            )
        sys.path.insert(0, _REF)

    from infgen.datasets import preprocess as ref_preprocess
    from infgen.modules import attr_tokenizer as ref_attr

    return ref_attr, ref_preprocess
