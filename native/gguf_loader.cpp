// Native GGUF tensor loader: mmap the file and expose a tensor table so
// Python can create zero-copy numpy views into the weight data.
//
// TPU-native counterpart of the reference's loader IO
// (reference src/nemo-ggml.cpp:83-247: gguf_init_from_file + per-tensor
// fread into backend buffers). Here the runtime maps the file once; tensor
// bytes are handed to jax.device_put directly from the page cache --
// no read() copies of the multi-GB weight blob.
//
// C ABI; bound via ctypes. Metadata (strings/ints/vocab) is still parsed by
// the small pure-Python reader -- this component only accelerates the bulk
// tensor payload.

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

struct TensorInfo {
    std::string name;
    int32_t gtype = 0;
    uint32_t n_dims = 0;
    int64_t ne[4] = {1, 1, 1, 1};  // GGUF order (reversed vs numpy)
    uint64_t offset = 0;           // relative to data section
};

struct Loader {
    int fd = -1;
    const uint8_t* base = nullptr;
    size_t size = 0;
    uint64_t data_start = 0;
    std::vector<TensorInfo> tensors;
    std::string error;
};

struct Cursor {
    const uint8_t* p;
    const uint8_t* end;
    bool ok = true;

    template <typename T> T read() {
        if (p + sizeof(T) > end) { ok = false; return T(); }
        T v;
        std::memcpy(&v, p, sizeof(T));
        p += sizeof(T);
        return v;
    }
    std::string read_str() {
        uint64_t n = read<uint64_t>();
        if (!ok || p + n > end) { ok = false; return {}; }
        std::string s((const char*)p, n);
        p += n;
        return s;
    }
    void skip(size_t n) {
        if (p + n > end) { ok = false; return; }
        p += n;
    }
};

size_t value_size(int32_t t) {
    switch (t) {
        case 0: case 1: return 1;          // u8, i8
        case 2: case 3: return 2;          // u16, i16
        case 4: case 5: case 6: return 4;  // u32, i32, f32
        case 7: return 1;                  // bool
        case 10: case 11: case 12: return 8;  // u64, i64, f64
        default: return 0;
    }
}

bool skip_value(Cursor& c, int32_t vtype) {
    if (vtype == 8) { c.read_str(); return c.ok; }  // string
    if (vtype == 9) {                               // array
        int32_t et = c.read<int32_t>();
        uint64_t n = c.read<uint64_t>();
        if (!c.ok) return false;
        if (et == 8) {
            for (uint64_t i = 0; i < n && c.ok; ++i) c.read_str();
        } else {
            size_t sz = value_size(et);
            if (!sz) return false;
            c.skip(n * sz);
        }
        return c.ok;
    }
    size_t sz = value_size(vtype);
    if (!sz) return false;
    c.skip(sz);
    return c.ok;
}

}  // namespace

extern "C" {

void* nemo_gguf_open(const char* path) {
    auto* L = new Loader();
    L->fd = open(path, O_RDONLY);
    if (L->fd < 0) { L->error = "open failed"; return L; }
    struct stat st;
    if (fstat(L->fd, &st) != 0) { L->error = "fstat failed"; return L; }
    L->size = (size_t)st.st_size;
    void* m = mmap(nullptr, L->size, PROT_READ, MAP_SHARED, L->fd, 0);
    if (m == MAP_FAILED) { L->error = "mmap failed"; return L; }
    L->base = (const uint8_t*)m;
    madvise(m, L->size, MADV_SEQUENTIAL);

    Cursor c{L->base, L->base + L->size};
    if (c.read<uint32_t>() != 0x46554747u) { L->error = "bad magic"; return L; }
    if (c.read<uint32_t>() != 3u) { L->error = "bad version"; return L; }
    int64_t n_tensors = c.read<int64_t>();
    int64_t n_kv = c.read<int64_t>();

    for (int64_t i = 0; i < n_kv && c.ok; ++i) {
        c.read_str();                       // key
        int32_t vt = c.read<int32_t>();
        if (!skip_value(c, vt)) { L->error = "bad metadata"; return L; }
    }
    for (int64_t i = 0; i < n_tensors && c.ok; ++i) {
        TensorInfo t;
        t.name = c.read_str();
        t.n_dims = c.read<uint32_t>();
        if (t.n_dims > 4) { L->error = "too many dims"; return L; }
        for (uint32_t d = 0; d < t.n_dims; ++d) t.ne[d] = c.read<int64_t>();
        t.gtype = c.read<int32_t>();
        t.offset = c.read<uint64_t>();
        if (!c.ok) { L->error = "bad tensor record"; return L; }
        L->tensors.push_back(std::move(t));
    }
    uint64_t pos = (uint64_t)(c.p - L->base);
    L->data_start = (pos + 31) / 32 * 32;   // ALIGNMENT = 32
    return L;
}

const char* nemo_gguf_error(void* h) {
    auto* L = (Loader*)h;
    return L->error.empty() ? nullptr : L->error.c_str();
}

int64_t nemo_gguf_n_tensors(void* h) {
    return (int64_t)((Loader*)h)->tensors.size();
}

// Fill caller buffers describing tensor i. name_buf must hold >= 256 bytes;
// ne_out must hold 4 int64. Returns the absolute byte offset of the data.
uint64_t nemo_gguf_tensor_info(void* h, int64_t i, char* name_buf,
                               int32_t* gtype_out, uint32_t* ndims_out,
                               int64_t* ne_out) {
    auto* L = (Loader*)h;
    const TensorInfo& t = L->tensors[(size_t)i];
    std::snprintf(name_buf, 256, "%s", t.name.c_str());
    *gtype_out = t.gtype;
    *ndims_out = t.n_dims;
    for (int d = 0; d < 4; ++d) ne_out[d] = t.ne[d];
    return L->data_start + t.offset;
}

const uint8_t* nemo_gguf_base(void* h) { return ((Loader*)h)->base; }
uint64_t nemo_gguf_size(void* h) { return ((Loader*)h)->size; }

void nemo_gguf_close(void* h) {
    auto* L = (Loader*)h;
    if (L->base) munmap((void*)L->base, L->size);
    if (L->fd >= 0) close(L->fd);
    delete L;
}

}  // extern "C"
