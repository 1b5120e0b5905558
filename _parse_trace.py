from tensorflow.python.profiler.internal import _pywrap_profiler  # may not exist; fallback below
