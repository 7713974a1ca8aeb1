// CRIS-TPU native data plane: batched image/mask preprocessing.
//
// The reference preprocesses samples one by one in Python dataloader
// workers (utils/dataset.py:127-221). Here one C call preprocesses a whole
// batch on an internal thread pool with a single GIL release:
//   JPEG decode -> BGR->RGB -> cubic affine warp to the square input size
//   with CLIP-mean border fill -> fused (x/255 - mean)/std normalization
//   into the caller's contiguous NHWC float32 batch buffer,
// and for training masks: PNG decode -> linear warp -> /255.
//
// The affine matrices are the same analytic scale+translate the Python
// path computes (cris_tpu/data/transforms.py), so outputs are bit-identical
// to the cv2-based Python pipeline (identical cv2 calls).
//
// Build: g++ -O3 -shared -fPIC batch_preprocess.cc -o libcris_data.so \
//        $(pkg-config --cflags --libs opencv4 | sed ...) -lpthread
// (see build.sh; the Python wrapper builds on demand and falls back to the
// pure-Python path when no toolchain/OpenCV is present.)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

constexpr double kClipMean[3] = {0.48145466, 0.4578275, 0.40821073};  // RGB
constexpr double kClipStd[3] = {0.26862954, 0.26130258, 0.27577711};

struct Job {
  const uint8_t* img;
  size_t img_len;
  const uint8_t* mask;  // may be null
  size_t mask_len;
  float* img_out;       // input_size*input_size*3, NHWC RGB normalized
  float* mask_out;      // input_size*input_size, may be null
  double* inv_out;      // 2x3 inverse affine
  int32_t* ori_out;     // {h, w}
};

// analytic letterbox transform (transforms.py get_transform_mats)
void transform_mats(int ori_h, int ori_w, int inp, cv::Mat& mat, double* inv) {
  double scale = std::min(static_cast<double>(inp) / ori_h,
                          static_cast<double>(inp) / ori_w);
  double new_h = ori_h * scale, new_w = ori_w * scale;
  double bias_x = (inp - new_w) / 2.0, bias_y = (inp - new_h) / 2.0;
  mat = (cv::Mat_<double>(2, 3) << scale, 0.0, bias_x, 0.0, scale, bias_y);
  if (inv != nullptr) {
    inv[0] = 1.0 / scale; inv[1] = 0.0; inv[2] = -bias_x / scale;
    inv[3] = 0.0; inv[4] = 1.0 / scale; inv[5] = -bias_y / scale;
  }
}

int process_one(const Job& job, int inp) {
  cv::Mat raw(1, static_cast<int>(job.img_len), CV_8UC1,
              const_cast<uint8_t*>(job.img));
  cv::Mat bgr = cv::imdecode(raw, cv::IMREAD_COLOR);
  if (bgr.empty()) return -1;

  if (job.ori_out != nullptr) {
    job.ori_out[0] = bgr.rows;
    job.ori_out[1] = bgr.cols;
  }
  cv::Mat mat;
  transform_mats(bgr.rows, bgr.cols, inp, mat, job.inv_out);

  cv::Mat rgb;
  cv::cvtColor(bgr, rgb, cv::COLOR_BGR2RGB);
  cv::Mat warped;
  cv::warpAffine(rgb, warped, mat, cv::Size(inp, inp), cv::INTER_CUBIC,
                 cv::BORDER_CONSTANT,
                 cv::Scalar(kClipMean[0] * 255.0, kClipMean[1] * 255.0,
                            kClipMean[2] * 255.0));

  // fused normalize: out = px * (1/(255*std)) - mean/std, NHWC float32,
  // single pass via 256-entry per-channel lookup tables
  static thread_local float lut[3][256];
  static thread_local bool lut_ready = false;
  if (!lut_ready) {
    for (int c = 0; c < 3; ++c) {
      const float s = static_cast<float>(1.0 / (255.0 * kClipStd[c]));
      const float b = static_cast<float>(-kClipMean[c] / kClipStd[c]);
      for (int p = 0; p < 256; ++p) lut[c][p] = p * s + b;
    }
    lut_ready = true;
  }
  const uint8_t* src = warped.ptr<uint8_t>(0);
  float* dst = job.img_out;
  const size_t npix = static_cast<size_t>(inp) * inp;
  for (size_t i = 0; i < npix; ++i) {
    dst[3 * i + 0] = lut[0][src[3 * i + 0]];
    dst[3 * i + 1] = lut[1][src[3 * i + 1]];
    dst[3 * i + 2] = lut[2][src[3 * i + 2]];
  }

  if (job.mask != nullptr && job.mask_out != nullptr) {
    cv::Mat mraw(1, static_cast<int>(job.mask_len), CV_8UC1,
                 const_cast<uint8_t*>(job.mask));
    cv::Mat m = cv::imdecode(mraw, cv::IMREAD_GRAYSCALE);
    if (m.empty()) return -2;
    cv::Mat mf;
    m.convertTo(mf, CV_32F);
    cv::Mat mwarped(inp, inp, CV_32FC1, job.mask_out);
    cv::warpAffine(mf, mwarped, mat, cv::Size(inp, inp), cv::INTER_LINEAR,
                   cv::BORDER_CONSTANT, cv::Scalar(0.0));
    mwarped *= (1.0 / 255.0);
  }
  return 0;
}

}  // namespace

extern "C" {

// Returns 0 on success, else the (negative) status of the first failure.
int cris_batch_preprocess(
    const uint8_t** img_ptrs, const size_t* img_lens,
    const uint8_t** mask_ptrs, const size_t* mask_lens,  // nullable array
    int n, int input_size, int nthreads,
    float* img_out,      // n * input_size^2 * 3
    float* mask_out,     // n * input_size^2, nullable
    double* inv_out,     // n * 6, nullable
    int32_t* ori_out) {  // n * 2, nullable
  const size_t img_stride = static_cast<size_t>(input_size) * input_size * 3;
  const size_t mask_stride = static_cast<size_t>(input_size) * input_size;

  std::vector<Job> jobs(n);
  for (int i = 0; i < n; ++i) {
    jobs[i].img = img_ptrs[i];
    jobs[i].img_len = img_lens[i];
    jobs[i].mask = (mask_ptrs != nullptr) ? mask_ptrs[i] : nullptr;
    jobs[i].mask_len = (mask_lens != nullptr) ? mask_lens[i] : 0;
    jobs[i].img_out = img_out + i * img_stride;
    jobs[i].mask_out = (mask_out != nullptr) ? mask_out + i * mask_stride
                                             : nullptr;
    jobs[i].inv_out = (inv_out != nullptr) ? inv_out + i * 6 : nullptr;
    jobs[i].ori_out = (ori_out != nullptr) ? ori_out + i * 2 : nullptr;
  }

  std::atomic<int> next(0);
  std::atomic<int> status(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int rc = process_one(jobs[i], input_size);
      if (rc != 0) {
        int expected = 0;
        status.compare_exchange_strong(expected, rc);
      }
    }
  };

  int threads = std::max(1, std::min(nthreads, n));
  if (threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return status.load();
}

int cris_data_abi_version() { return 1; }

}  // extern "C"
