// Standalone native test for libvqadata: exercises store assembly and the
// concurrent prefetch loader (ring-slot protocol with v/b ownership
// rotation). Built by `make test` (and `make tsan_test` for the
// ThreadSanitizer build).

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
                            int, int64_t);
void vqadata_loader_push_order(void*, const int64_t*, int64_t);
void vqadata_loader_register_slot(void*, float*, float*, uint8_t*, int64_t*);
void vqadata_loader_swap_vb(void*, int64_t, float*, float*);
int64_t vqadata_loader_next(void*, int64_t, int64_t*);
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

  // concurrent prefetch loader: host-pushed epoch orders, 3 registered ring
  // slots, v/b buffers rotated out before each recycle (the Python side's
  // zero-copy ownership contract)
  std::vector<int64_t> row_to_image = {0, 1, 2, 3, 4, 5, 0, 1};
  const int64_t n_rows = static_cast<int64_t>(row_to_image.size());
  const int64_t bs = 3;
  void* loader = vqadata_loader_create(store, row_to_image.data(), n_rows, bs,
                                       max_boxes, /*drop_last=*/0,
                                       /*assemble_threads=*/2);

  const int64_t kSlots = 3;
  const size_t v_sz = bs * max_boxes * v_dim, b_sz = bs * max_boxes * s_dim;
  // generous buffer arena: initial slots + one fresh pair per consumed batch
  std::vector<std::vector<float>> v_bufs, b_bufs;
  std::vector<std::vector<uint8_t>> m_bufs(kSlots,
                                           std::vector<uint8_t>(bs * max_boxes));
  std::vector<std::vector<int64_t>> i_bufs(kSlots, std::vector<int64_t>(bs));
  std::vector<int64_t> slot_vbuf(kSlots);  // which v/b pair each slot holds
  for (int64_t s = 0; s < kSlots; ++s) {
    v_bufs.emplace_back(v_sz);
    b_bufs.emplace_back(b_sz);
    slot_vbuf[s] = s;
    vqadata_loader_register_slot(loader, v_bufs[s].data(), b_bufs[s].data(),
                                 m_bufs[s].data(), i_bufs[s].data());
  }

  const int epochs = 2;
  const int64_t batches_per_epoch = (n_rows + bs - 1) / bs;
  std::vector<int64_t> order(n_rows);
  for (int64_t i = 0; i < n_rows; ++i) order[i] = n_rows - 1 - i;  // reversed

  int64_t held = -1, seen = 0;
  struct Held {  // the batch the consumer is still "using"
    const float* v = nullptr;
    float first = 0.0f;
  } prev_batch;
  for (int e = 0; e < epochs; ++e) {
    vqadata_loader_push_order(loader, order.data(), n_rows);
    for (int64_t batch = 0; batch < batches_per_epoch; ++batch) {
      if (held >= 0) {
        // ownership rotation: swap a FRESH v/b pair into the held slot
        // before recycling it, so the previously yielded buffers are never
        // rewritten (they may still be aliased by a zero-copy consumer)
        v_bufs.emplace_back(v_sz);
        b_bufs.emplace_back(b_sz);
        const int64_t nb = static_cast<int64_t>(v_bufs.size()) - 1;
        vqadata_loader_swap_vb(loader, held, v_bufs[nb].data(),
                               b_bufs[nb].data());
        slot_vbuf[held] = nb;
      }
      int64_t rows = 0;
      const int64_t slot = vqadata_loader_next(loader, held, &rows);
      assert(slot >= 0 && slot < kSlots);
      held = slot;
      assert(rows > 0 && rows <= bs);
      const float* v = v_bufs[slot_vbuf[slot]].data();
      const uint8_t* m = m_bufs[slot].data();
      const int64_t* li = i_bufs[slot].data();
      for (int64_t r = 0; r < rows; ++r) {
        assert(li[r] >= 0 && li[r] < n_rows);
        // at least one real box in every row, and the row's first feature
        // matches a direct store lookup
        assert(m[r * max_boxes] == 1);
        const int64_t img = row_to_image[li[r]];
        const int64_t start = pos[2 * img];
        assert(v[r * max_boxes * v_dim] == feats[start * v_dim]);
      }
      if (prev_batch.v != nullptr) {
        // the batch yielded LAST iteration must be untouched even though
        // its slot has been recycled (rotation contract)
        assert(prev_batch.v[0] == prev_batch.first);
      }
      prev_batch.v = v;
      prev_batch.first = v[0];
      seen += rows;
    }
  }
  assert(seen == epochs * n_rows);
  vqadata_loader_destroy(loader);
  vqadata_store_destroy(store);
  std::printf("vqadata_test: OK\n");
  return 0;
}
