// Point-adjust anomaly evaluation kernel.
//
// Native equivalent of the reference's numba-JIT loop
// (tasks/anomaly_detection.py:215-237): when a predicted anomaly point
// falls inside a ground-truth anomaly segment, the whole segment is marked
// predicted. Exposed via a C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libnative.so pointadjust.cpp

#include <cstdint>

extern "C" {

void adjust_anomalies(int32_t* pred, const int32_t* gt, int64_t n) {
    bool anomaly_state = false;
    for (int64_t i = 0; i < n; ++i) {
        if (gt[i] == 1 && pred[i] == 1 && !anomaly_state) {
            anomaly_state = true;
            for (int64_t j = i; j > 0; --j) {
                if (gt[j] == 0) break;
                if (pred[j] == 0) pred[j] = 1;
            }
            for (int64_t j = i; j < n; ++j) {
                if (gt[j] == 0) break;
                if (pred[j] == 0) pred[j] = 1;
            }
        } else if (gt[i] == 0) {
            anomaly_state = false;
        }
        if (anomaly_state) pred[i] = 1;
    }
}

// Sequential-overwrite window stitching: scatter [n_windows, len, C] values
// into a [n_points, C] buffer at given start offsets. Later windows
// overwrite earlier ones, matching the python loop semantics
// (tasks/forecasting.py:72-78).
void stitch_windows_f32(float* out, const float* values, const int64_t* starts,
                        int64_t n_windows, int64_t win_len, int64_t n_channels,
                        int64_t n_points) {
    for (int64_t w = 0; w < n_windows; ++w) {
        const int64_t s = starts[w];
        if (s < 0 || s + win_len > n_points) continue;
        float* dst = out + s * n_channels;
        const float* src = values + w * win_len * n_channels;
        for (int64_t i = 0; i < win_len * n_channels; ++i) dst[i] = src[i];
    }
}

}  // extern "C"
