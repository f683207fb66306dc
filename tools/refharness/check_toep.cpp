// Harness linked against the read-only reference headers (NOT copied).
// Validates: toep_127 output depends only on the first 127 bits of each operand.
#include <pvac/pvac.hpp>
#include <cstdio>
using namespace pvac;
int main(){
    for (int trial=0; trial<2000; ++trial){
        std::vector<uint64_t> top(258), y(256);
        for (auto&q:top) q=csprng_u64();
        for (auto&q:y) q=csprng_u64();
        uint64_t lo1,hi1, lo2,hi2;
        toep_127_scalar(top,y,lo1,hi1);
        // truncate: keep only bits 0..126 of each
        std::vector<uint64_t> t2(top), y2(y);
        t2[1] &= (1ull<<63)-1; for(size_t i=2;i<t2.size();++i) t2[i]=0;
        y2[1] &= (1ull<<63)-1; for(size_t i=2;i<y2.size();++i) y2[i]=0;
        toep_127_scalar(t2,y2,lo2,hi2);
        if (lo1!=lo2 || hi1!=hi2){ printf("MISMATCH at trial %d\n", trial); return 1; }
    }
    printf("OK: toep_127 depends only on first 127 bits of both operands\n");
    return 0;
}
