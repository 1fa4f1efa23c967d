// Standalone native test for libvqadata: exercises store assembly and the
// concurrent prefetch loader. Built by `make test` (and `make tsan_test` for
// a ThreadSanitizer pass over the producer/consumer machinery).

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
void* vqadata_store_create(const float*, const float*, const int64_t*,
                           int64_t, int64_t, int64_t, int64_t);
void vqadata_store_destroy(void*);
void vqadata_assemble(void*, const int64_t*, int64_t, int64_t, float*, float*,
                      uint8_t*, int64_t);
void* vqadata_loader_create(void*, const int64_t*, int64_t, int64_t, int64_t,
                            int, int, uint64_t);
int64_t vqadata_loader_next(void*, float*, float*, uint8_t*, int64_t*);
void vqadata_loader_destroy(void*);
}

int main() {
  const int64_t n_images = 6, v_dim = 8, s_dim = 4, max_boxes = 5;
  // adaptive layout: images with 2..4 boxes
  std::vector<int64_t> pos = {0, 2, 2, 5, 5, 9, 9, 11, 11, 15, 15, 18};
  const int64_t total = 18;
  std::vector<float> feats(total * v_dim), spats(total * s_dim);
  for (size_t i = 0; i < feats.size(); ++i) feats[i] = static_cast<float>(i);
  for (size_t i = 0; i < spats.size(); ++i) spats[i] = static_cast<float>(i) * 0.5f;

  void* store = vqadata_store_create(feats.data(), spats.data(), pos.data(),
                                     n_images, 0, v_dim, s_dim);

  // synchronous assemble, multithreaded
  std::vector<int64_t> idx = {0, 3, 5, 1};
  std::vector<float> out_v(idx.size() * max_boxes * v_dim);
  std::vector<float> out_b(idx.size() * max_boxes * s_dim);
  std::vector<uint8_t> out_m(idx.size() * max_boxes);
  vqadata_assemble(store, idx.data(), idx.size(), max_boxes, out_v.data(),
                   out_b.data(), out_m.data(), 4);
  // image 0 has boxes [0,2): first feature value is 0, mask = 1,1,0,0,0
  assert(out_v[0] == 0.0f);
  assert(out_m[0] == 1 && out_m[1] == 1 && out_m[2] == 0);
  // image 3 has boxes [9,11): first feature value is 9*v_dim
  assert(out_v[max_boxes * v_dim] == 9.0f * v_dim);

  // concurrent loader: two epochs worth of batches, shuffled
  std::vector<int64_t> row_to_image = {0, 1, 2, 3, 4, 5, 0, 1};
  const int64_t bs = 3;
  void* loader = vqadata_loader_create(store, row_to_image.data(),
                                       row_to_image.size(), bs, max_boxes,
                                       /*shuffle=*/1, /*drop_last=*/0,
                                       /*seed=*/42);
  std::vector<float> lv(bs * max_boxes * v_dim);
  std::vector<float> lb(bs * max_boxes * s_dim);
  std::vector<uint8_t> lm(bs * max_boxes);
  std::vector<int64_t> li(bs);
  int64_t seen = 0;
  for (int batch = 0; batch < 6; ++batch) {  // ~2 epochs
    int64_t rows = vqadata_loader_next(loader, lv.data(), lb.data(), lm.data(),
                                       li.data());
    assert(rows > 0 && rows <= bs);
    for (int64_t r = 0; r < rows; ++r) {
      assert(li[r] >= 0 && li[r] < (int64_t)row_to_image.size());
      // at least one real box in every row
      assert(lm[r * max_boxes] == 1);
    }
    seen += rows;
  }
  assert(seen >= 16);
  vqadata_loader_destroy(loader);
  vqadata_store_destroy(store);
  std::printf("vqadata_test: OK\n");
  return 0;
}
