// Dev/test tool: dump authoritative NanoVDB struct layouts as JSON.
//
// Compiled against the NanoVDB header vendored by the reference repo
// (Apache-2.0 OpenVDB project code, used here as the FILE FORMAT SPEC —
// nothing from it ships in this repo). The emitted constants are baked into
// hnanosolver_tpu/io/nvdb.py; this tool exists so they can be re-verified /
// regenerated against any NanoVDB version:
//
//   g++ -std=c++17 -I$NANOVDB_INCLUDE native/nvdb_layout_dump.cpp -o dump
//
#include <cstdio>
#include <nanovdb/NanoVDB.h>

using namespace nanovdb;

template<typename T>
static void row(const char* name) {
    std::printf("  \"%s\": %zu,\n", name, sizeof(T));
}

int main() {
    using RootF = NanoRoot<float>;
    using UpperF = NanoUpper<float>;
    using LowerF = NanoLower<float>;
    using LeafF = NanoLeaf<float>;
    using RootV = NanoRoot<Vec3f>;
    using UpperV = NanoUpper<Vec3f>;
    using LowerV = NanoLower<Vec3f>;
    using LeafV = NanoLeaf<Vec3f>;

    std::printf("{\n");
    row<GridData>("GridData");
    row<TreeData>("TreeData");
    row<Map>("Map");
    row<RootF::DataType>("RootF");
    row<RootF::DataType::Tile>("RootTileF");
    row<UpperF::DataType>("UpperF");
    row<LowerF::DataType>("LowerF");
    row<LeafF::DataType>("LeafF");
    row<RootV::DataType>("RootV");
    row<RootV::DataType::Tile>("RootTileV");
    row<UpperV::DataType>("UpperV");
    row<LowerV::DataType>("LowerV");
    row<LeafV::DataType>("LeafV");
    std::printf("  \"LeafF_values_off\": %zu,\n",
                offsetof(LeafF::DataType, mValues));
    std::printf("  \"LeafV_values_off\": %zu,\n",
                offsetof(LeafV::DataType, mValues));
    std::printf("  \"UpperF_table_off\": %zu,\n", offsetof(UpperF::DataType, mTable));
    std::printf("  \"LowerF_table_off\": %zu,\n", offsetof(LowerF::DataType, mTable));
    std::printf("  \"UpperV_table_off\": %zu,\n", offsetof(UpperV::DataType, mTable));
    std::printf("  \"LowerV_table_off\": %zu,\n", offsetof(LowerV::DataType, mTable));
    std::printf("  \"UpperF_min_off\": %zu,\n", offsetof(UpperF::DataType, mMinimum));
    std::printf("  \"LowerF_min_off\": %zu,\n", offsetof(LowerF::DataType, mMinimum));
    std::printf("  \"UpperV_min_off\": %zu,\n", offsetof(UpperV::DataType, mMinimum));
    std::printf("  \"LowerV_min_off\": %zu,\n", offsetof(LowerV::DataType, mMinimum));
    std::printf("  \"RootF_background_off\": %zu,\n",
                offsetof(RootF::DataType, mBackground));
    std::printf("  \"RootV_background_off\": %zu,\n",
                offsetof(RootV::DataType, mBackground));
    std::printf("  \"RootTileF_value_off\": %zu,\n",
                offsetof(RootF::DataType::Tile, value));
    std::printf("  \"RootTileV_value_off\": %zu,\n",
                offsetof(RootV::DataType::Tile, value));
    std::printf("  \"FileHeader\": %zu,\n", sizeof(io::FileHeader));
    std::printf("  \"FileMetaData\": %zu\n", sizeof(io::FileMetaData));
    std::printf("}\n");
    return 0;
}
