// Native unit test for the shard loader (assert-based, no framework —
// mirroring the reference's in-binary test style, resnet.cu:2990-3218).
//
//   make -C csrc test

#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <sys/stat.h>
#include <unistd.h>

extern "C" {
void* loader_create(const char* dir, int num_shards, int shard_images,
                    int image_dim, int channels, int batch_size,
                    int disk_nchw, int out_nhwc, int prefetch_depth,
                    int64_t start_shard, int64_t start_batch,
                    int64_t start_epoch, int num_workers);
int loader_next(void* handle, float* images_out, int32_t* labels_out,
                int64_t* cursor_out);
void loader_destroy(void* handle);
}

namespace {

constexpr int kShards = 2, kImgs = 8, kDim = 4, kC = 3, kBatch = 4;

float pixel_value(int shard, int img, int c, int h, int w) {
  return shard * 10000 + img * 100 + c * 16 + h * 4 + w;
}

void write_fixtures(const std::string& dir) {
  mkdir(dir.c_str(), 0755);
  for (int s = 0; s < kShards; ++s) {
    char path[512];
    snprintf(path, sizeof path, "%s/%03d.images", dir.c_str(), s);
    FILE* f = fopen(path, "wb");
    assert(f);
    for (int i = 0; i < kImgs; ++i)
      for (int c = 0; c < kC; ++c)  // NCHW on disk
        for (int h = 0; h < kDim; ++h)
          for (int w = 0; w < kDim; ++w) {
            float v = pixel_value(s, i, c, h, w);
            fwrite(&v, sizeof v, 1, f);
          }
    fclose(f);
    snprintf(path, sizeof path, "%s/%03d.labels", dir.c_str(), s);
    f = fopen(path, "wb");
    assert(f);
    for (int i = 0; i < kImgs; ++i) {
      int32_t lab = s * 10 + i;
      fwrite(&lab, sizeof lab, 1, f);
    }
    fclose(f);
  }
}

}  // namespace

int main() {
  std::string dir = "/tmp/shard_loader_test";
  write_fixtures(dir);

  std::vector<float> images(kBatch * kDim * kDim * kC);
  std::vector<int32_t> labels(kBatch);
  int64_t cur[3];

  // NHWC output with repack
  void* L = loader_create(dir.c_str(), kShards, kImgs, kDim, kC, kBatch,
                          /*disk_nchw=*/1, /*out_nhwc=*/1, 2, 0, 0, 0, 1);
  // batch 0: shard 0 images 0-3
  assert(loader_next(L, images.data(), labels.data(), cur) == 0);
  for (int i = 0; i < kBatch; ++i) assert(labels[i] == i);
  // NHWC index (i, h, w, c)
  for (int i = 0; i < kBatch; ++i)
    for (int h = 0; h < kDim; ++h)
      for (int w = 0; w < kDim; ++w)
        for (int c = 0; c < kC; ++c) {
          float got = images[((i * kDim + h) * kDim + w) * kC + c];
          assert(got == pixel_value(0, i, c, h, w));
        }
  assert(cur[0] == 0 && cur[1] == 1 && cur[2] == 0);

  // batch 1: shard 0 images 4-7; batch 2 wraps to shard 1
  assert(loader_next(L, images.data(), labels.data(), cur) == 0);
  assert(labels[0] == 4);
  assert(loader_next(L, images.data(), labels.data(), cur) == 0);
  assert(labels[0] == 10);  // shard 1
  // batch 3 finishes shard 1; batch 4 wraps to epoch 1
  assert(loader_next(L, images.data(), labels.data(), cur) == 0);
  assert(loader_next(L, images.data(), labels.data(), cur) == 0);
  assert(labels[0] == 0 && cur[2] == 1);
  loader_destroy(L);

  // resume from cursor (shard 1, batch 1): labels 14..17
  L = loader_create(dir.c_str(), kShards, kImgs, kDim, kC, kBatch,
                    1, 1, 2, /*shard=*/1, /*batch=*/1, /*epoch=*/0, 1);
  assert(loader_next(L, images.data(), labels.data(), cur) == 0);
  assert(labels[0] == 14 && labels[3] == 17);
  loader_destroy(L);

  // NCHW passthrough (no repack)
  L = loader_create(dir.c_str(), kShards, kImgs, kDim, kC, kBatch,
                    1, /*out_nhwc=*/0, 2, 0, 0, 0, 1);
  assert(loader_next(L, images.data(), labels.data(), cur) == 0);
  for (int i = 0; i < kBatch; ++i)
    for (int c = 0; c < kC; ++c)
      for (int h = 0; h < kDim; ++h)
        for (int w = 0; w < kDim; ++w) {
          float got = images[((i * kC + c) * kDim + h) * kDim + w];
          assert(got == pixel_value(0, i, c, h, w));
        }
  loader_destroy(L);

  // multi-worker resequencing: 4 workers, deep window — labels must come
  // back in exact stream order across several epochs
  L = loader_create(dir.c_str(), kShards, kImgs, kDim, kC, kBatch,
                    1, 1, 8, 0, 0, 0, 4);
  {
    const int expect[4] = {0, 4, 10, 14};  // first label of each batch
    for (int step = 0; step < 16; ++step) {
      assert(loader_next(L, images.data(), labels.data(), cur) == 0);
      assert(labels[0] == expect[step % 4]);
      for (int i = 1; i < kBatch; ++i) assert(labels[i] == labels[0] + i);
      assert(cur[2] == (step + 1) / 4);  // epoch advances every 4 batches
    }
  }
  loader_destroy(L);

  // truncated final shard: shard 1 holds only 6 images -> 1 batch of 4,
  // remainder dropped (clamped like the Python path, not a hard error)
  std::string dir2 = "/tmp/shard_loader_test_trunc";
  write_fixtures(dir2);
  assert(truncate((dir2 + "/001.images").c_str(),
                  6L * kDim * kDim * kC * sizeof(float)) == 0);
  L = loader_create(dir2.c_str(), kShards, kImgs, kDim, kC, kBatch,
                    1, 1, 4, 0, 0, 0, 2);
  {
    // epoch = 3 batches now: s0b0, s0b1, s1b0, then wrap
    const int expect[3] = {0, 4, 10};
    for (int step = 0; step < 9; ++step) {
      assert(loader_next(L, images.data(), labels.data(), cur) == 0);
      assert(labels[0] == expect[step % 3]);
      assert(cur[2] == (step + 1) / 3);
    }
  }
  loader_destroy(L);

  // missing shard file -> clean error, not a crash
  L = loader_create("/tmp/shard_loader_nonexistent", 2, kImgs, kDim, kC,
                    kBatch, 1, 1, 2, 0, 0, 0, 2);
  assert(loader_next(L, images.data(), labels.data(), cur) == 1);
  loader_destroy(L);

  printf("test_shard_loader: ALL OK\n");
  return 0;
}
