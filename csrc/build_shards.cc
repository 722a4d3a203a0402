// Offline shard builder — the native equivalent of the reference's
// build_training_shards.c.
//
// The reference tool (build_training_shards.c:12-182) reads, per shard, a
// partition CSV of (class, img_num, row_off, col_off), fseeks 224x224 crops
// out of per-class 256x256x3 raw uint8 blobs, swaps BGR->RGB, subtracts the
// per-channel ImageNet means (123.68/116.78/103.94), repacks NHWC->NCHW,
// and writes %03d.images (float32) + %03d.labels (int32).
//
// This builder performs the same transform with a thread pool (one worker
// per shard) and supports writing either layout. Class blobs are expected
// at <blob_dir>/<class>.images as raw uint8 HWC 256x256x3 frames
// concatenated per image (the reference's class-blob format).
//
// Usage:
//   build_shards <partition_dir> <blob_dir> <out_dir> <num_shards>
//       [--nhwc] [--dim 224] [--src-dim 256]
//
// Partition CSV per shard: <partition_dir>/%03d.csv lines
//   class,img_num,row_off,col_off

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr float kMeans[3] = {123.68f, 116.78f, 103.94f};  // RGB

struct Args {
  std::string partition_dir, blob_dir, out_dir;
  int num_shards = 40;
  bool nhwc = false;
  int dim = 224;
  int src_dim = 256;
  bool bgr_swap = true;
  bool subtract_means = true;
};

struct Row {
  int cls, img_num, row_off, col_off;
};

bool build_one_shard(const Args& a, int shard) {
  char path[4096];
  snprintf(path, sizeof path, "%s/%03d.csv", a.partition_dir.c_str(), shard);
  FILE* csv = fopen(path, "r");
  if (!csv) {
    fprintf(stderr, "missing partition %s\n", path);
    return false;
  }
  std::vector<Row> rows;
  Row r;
  while (fscanf(csv, "%d,%d,%d,%d", &r.cls, &r.img_num, &r.row_off,
                &r.col_off) == 4) {
    rows.push_back(r);
  }
  fclose(csv);

  snprintf(path, sizeof path, "%s/%03d.images", a.out_dir.c_str(), shard);
  FILE* img_out = fopen(path, "wb");
  snprintf(path, sizeof path, "%s/%03d.labels", a.out_dir.c_str(), shard);
  FILE* lab_out = fopen(path, "wb");
  if (!img_out || !lab_out) return false;

  const int d = a.dim, sd = a.src_dim, c = 3;
  const int64_t src_img_bytes = static_cast<int64_t>(sd) * sd * c;
  std::vector<uint8_t> crop_src(static_cast<size_t>(d) * sd * c);
  std::vector<float> out(static_cast<size_t>(d) * d * c);

  int last_cls = -1;
  FILE* blob = nullptr;
  for (const Row& row : rows) {
    if (row.cls != last_cls) {
      if (blob) fclose(blob);
      snprintf(path, sizeof path, "%s/%d.images", a.blob_dir.c_str(), row.cls);
      blob = fopen(path, "rb");
      if (!blob) {
        fprintf(stderr, "missing blob %s\n", path);
        fclose(img_out);
        fclose(lab_out);
        return false;
      }
      last_cls = row.cls;
    }
    // read d rows starting at row_off (full width), then column-crop
    // (the reference freads row-by-row, build_training_shards.c:85-105)
    int64_t base = row.img_num * src_img_bytes +
                   static_cast<int64_t>(row.row_off) * sd * c;
    if (fseek(blob, base, SEEK_SET) != 0 ||
        fread(crop_src.data(), 1, static_cast<size_t>(d) * sd * c, blob) !=
            static_cast<size_t>(d) * sd * c) {
      fprintf(stderr, "short read class %d img %d\n", row.cls, row.img_num);
      fclose(blob);
      fclose(img_out);
      fclose(lab_out);
      return false;
    }
    for (int y = 0; y < d; ++y) {
      for (int x = 0; x < d; ++x) {
        const uint8_t* px =
            crop_src.data() + (static_cast<int64_t>(y) * sd + row.col_off + x) * c;
        for (int ch = 0; ch < c; ++ch) {
          // BGR->RGB swap (build_training_shards.c:115-131)
          int src_ch = a.bgr_swap ? (c - 1 - ch) : ch;
          float v = static_cast<float>(px[src_ch]);
          if (a.subtract_means) v -= kMeans[ch];
          int64_t idx =
              a.nhwc
                  ? (static_cast<int64_t>(y) * d + x) * c + ch
                  : static_cast<int64_t>(ch) * d * d + y * d + x;  // NCHW
          out[idx] = v;
        }
      }
    }
    fwrite(out.data(), sizeof(float), out.size(), img_out);
    int32_t lab = row.cls;
    fwrite(&lab, sizeof lab, 1, lab_out);
  }
  if (blob) fclose(blob);
  fclose(img_out);
  fclose(lab_out);
  return true;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 5) {
    fprintf(stderr,
            "usage: %s <partition_dir> <blob_dir> <out_dir> <num_shards> "
            "[--nhwc] [--dim N] [--src-dim N]\n",
            argv[0]);
    return 2;
  }
  Args a;
  a.partition_dir = argv[1];
  a.blob_dir = argv[2];
  a.out_dir = argv[3];
  a.num_shards = atoi(argv[4]);
  for (int i = 5; i < argc; ++i) {
    if (!strcmp(argv[i], "--nhwc")) a.nhwc = true;
    else if (!strcmp(argv[i], "--dim") && i + 1 < argc) a.dim = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--src-dim") && i + 1 < argc)
      a.src_dim = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--no-bgr-swap")) a.bgr_swap = false;
    else if (!strcmp(argv[i], "--no-means")) a.subtract_means = false;
  }

  // one worker per shard, bounded pool (reference loops serially,
  // build_training_shards.c:174-182)
  unsigned pool = std::thread::hardware_concurrency();
  if (pool == 0) pool = 4;
  std::vector<std::thread> threads;
  std::vector<int> results(a.num_shards, 0);
  for (int s = 0; s < a.num_shards; ++s) {
    threads.emplace_back([&, s] { results[s] = build_one_shard(a, s) ? 1 : 0; });
    if (threads.size() == pool || s == a.num_shards - 1) {
      for (auto& t : threads) t.join();
      threads.clear();
    }
  }
  for (int s = 0; s < a.num_shards; ++s) {
    if (!results[s]) {
      fprintf(stderr, "shard %03d FAILED\n", s);
      return 1;
    }
  }
  printf("built %d shards -> %s\n", a.num_shards, a.out_dir.c_str());
  return 0;
}
