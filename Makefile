# helen_tpu build/test entry points.

NATIVE_SRC := native/helen_stitch.cpp
NATIVE_DIR := native/build

.PHONY: all native native-asan test test-native-asan bench clean

all: native

# the runtime loader keys the .so per host CPU (-march=native on a shared
# checkout must not serve one host's AVX build to another); build through it
native:
	python -c "from helen_tpu.stitch._native import build_native; print(build_native(force=True))"

# AddressSanitizer build + smoke run of the aligner / RLE expansion.
# (The reference ships no sanitizer coverage at all; run before releases.)
native-asan:
	@mkdir -p $(NATIVE_DIR)
	g++ -O1 -g -std=c++17 -shared -fPIC -fsanitize=address \
	  -fno-omit-frame-pointer $(NATIVE_SRC) \
	  -o $(NATIVE_DIR)/libhelen_stitch_asan.so

test-native-asan: native-asan
	LD_PRELOAD=$$(g++ -print-file-name=libasan.so) \
	HELEN_TPU_ASAN_SO=$(NATIVE_DIR)/libhelen_stitch_asan.so \
	ASAN_OPTIONS=detect_leaks=0 \
	python tests/native_asan_smoke.py

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf $(NATIVE_DIR)
