# Convenience targets (see README.md)

.PHONY: test test-fast bench bench-7b native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_config.py tests/test_windowing.py \
		tests/test_dft.py tests/test_configs_dir.py -q

bench:
	python bench.py

bench-7b:
	python bench.py --model meta-llama/Llama-2-7b-hf --batch 32 --quant 8

native: medtsllm_tpu/native/libnative.so

medtsllm_tpu/native/libnative.so: medtsllm_tpu/native/pointadjust.cpp
	g++ -O3 -shared -fPIC -o $@ $<

clean:
	rm -rf outputs .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
