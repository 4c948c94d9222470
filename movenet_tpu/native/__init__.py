"""Native (C++) runtime components: threaded clip decode + preprocess.

Built with ``python -m movenet_tpu.native.build`` (see native/io_loader.cpp);
all callers degrade gracefully when the shared library is absent.
"""
