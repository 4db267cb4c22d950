// Dev/test tool: validate .nvdb files emitted by hnanosolver_tpu/io/nvdb.py
// against the REAL NanoVDB implementation (the header vendored by the
// reference repo serves as the format's authoritative reader — nothing from
// it ships in this repo; this binary exists only for interop testing).
//
//   g++ -std=c++17 -I$NANOVDB_INCLUDE native/nvdb_validate.cpp -o validate
//   ./validate file.nvdb float   i j k   -> prints "value <v>"
//   ./validate file.nvdb summary         -> prints grid info + value checksum
//
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <vector>

#include <nanovdb/NanoVDB.h>

static std::vector<char> load_grid(const char* path) {
    std::ifstream is(path, std::ios::binary);
    if (!is) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(2); }
    nanovdb::io::FileHeader head;
    is.read((char*)&head, sizeof(head));
    if (!head.isValid()) { std::fprintf(stderr, "bad FileHeader\n"); std::exit(2); }
    if (head.codec != nanovdb::io::Codec::NONE) { std::fprintf(stderr, "compressed\n"); std::exit(2); }
    nanovdb::io::FileMetaData meta;
    is.read((char*)&meta, sizeof(meta));
    std::vector<char> name(meta.nameSize);
    is.read(name.data(), meta.nameSize);
    std::vector<char> buf(meta.gridSize);
    is.read(buf.data(), meta.gridSize);
    if (!is) { std::fprintf(stderr, "truncated grid data\n"); std::exit(2); }
    return buf;
}

template<typename T>
static int summary(const std::vector<char>& buf) {
    auto* grid = reinterpret_cast<const nanovdb::NanoGrid<T>*>(buf.data());
    if (!grid->isValid()) { std::fprintf(stderr, "grid->isValid() FAILED\n"); return 1; }
    auto& tree = grid->tree();
    std::printf("name %s\n", grid->gridName());
    std::printf("voxels %llu\n", (unsigned long long)tree.activeVoxelCount());
    std::printf("leaves %u lowers %u uppers %u\n",
                tree.nodeCount(0), tree.nodeCount(1), tree.nodeCount(2));
    auto bbox = tree.bbox();
    std::printf("bbox %d %d %d  %d %d %d\n", bbox.min()[0], bbox.min()[1],
                bbox.min()[2], bbox.max()[0], bbox.max()[1], bbox.max()[2]);
    // checksum: sum of all active values via per-leaf iteration
    double sum = 0.0;
    for (uint32_t n = 0; n < tree.nodeCount(0); ++n) {
        auto& leaf = tree.template getFirstNode<0>()[n];
        for (int i = 0; i < 512; ++i) {
            if (leaf.valueMask().isOn(i)) {
                if constexpr (std::is_same_v<T, float>) {
                    sum += leaf.getValue(i);
                } else {
                    auto v = leaf.getValue(i);
                    sum += v[0] + v[1] + v[2];
                }
            }
        }
    }
    std::printf("sum %.6f\n", sum);
    return 0;
}

template<typename T>
static int sample(const std::vector<char>& buf, int i, int j, int k) {
    auto* grid = reinterpret_cast<const nanovdb::NanoGrid<T>*>(buf.data());
    if (!grid->isValid()) { std::fprintf(stderr, "grid->isValid() FAILED\n"); return 1; }
    auto acc = grid->tree().getAccessor();
    if constexpr (std::is_same_v<T, float>) {
        std::printf("value %.6f active %d\n", acc.getValue(nanovdb::Coord(i, j, k)),
                    int(acc.isActive(nanovdb::Coord(i, j, k))));
    } else {
        auto v = acc.getValue(nanovdb::Coord(i, j, k));
        std::printf("value %.6f %.6f %.6f active %d\n", v[0], v[1], v[2],
                    int(acc.isActive(nanovdb::Coord(i, j, k))));
    }
    return 0;
}

int main(int argc, char** argv) {
    if (argc < 3) { std::fprintf(stderr, "usage: %s file {float|vec3f} [summary|i j k]\n", argv[0]); return 2; }
    auto buf = load_grid(argv[1]);
    const bool isVec = !std::strcmp(argv[2], "vec3f");
    if (argc == 3 || !std::strcmp(argv[3], "summary"))
        return isVec ? summary<nanovdb::Vec3f>(buf) : summary<float>(buf);
    const int i = std::atoi(argv[3]), j = std::atoi(argv[4]), k = std::atoi(argv[5]);
    return isVec ? sample<nanovdb::Vec3f>(buf, i, j, k) : sample<float>(buf, i, j, k);
}
