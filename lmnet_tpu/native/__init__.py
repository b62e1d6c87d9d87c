"""C++ sources for the native batch loader (compiled on demand by
lmnet_tpu.data.native_loader to a content-addressed .so in this directory)."""
