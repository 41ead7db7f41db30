// Conformance harness for the SERVED results page
// (engine/server/RootPlugin.h:124-214 BuildSearchHTML): feed fixture
// results through the real member function via a subclass and dump the
// HTML. The reference translation units are compiled untouched.
//
// Build:
//   g++ -O2 -std=c++17 -pthread -I/root/reference/engine/csolver \
//     -D'ntohll(x)=__builtin_bswap64(x)' -o ref_html_harness \
//     ref_html_harness.cpp /root/reference/query/query.cpp \
//     /root/reference/query/synsets.cpp \
//     /root/reference/engine/lib/stemmer/stemmer.cpp
//
// Input (stdin): n, then n pairs of lines url / title, then n lines of
// score bits hex. Output: the HTML written to argv[1] (BuildSearchHTML
// itself spams debug lines to stdout, so stdout is not usable).

#include "../../../reference/engine/server/RootPlugin.h"

#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

// the reference defines this global in LinuxTinyServer.cpp (not linked
// here); RootPlugin's ctor assigns it
PluginObject* Plugin = nullptr;

struct Harness : RootPlugin {
    std::string Build(std::vector<Query::SearchResult>& results) {
        return BuildSearchHTML(results);
    }
};

// RootPlugin's ctor hard-codes a dead absolute synsets path
// (RootPlugin.h:36) and would throw; BuildSearchHTML reads no member
// state and is non-virtual, so invoke it on raw storage without running
// the ctor.
static Harness* make_harness() {
    return static_cast<Harness*>(::operator new(sizeof(Harness)));
}

int main(int argc, char** argv) {
    int n;
    std::cin >> n;
    std::cin.ignore();
    std::vector<Query::SearchResult> results(n);
    for (int i = 0; i < n; ++i) {
        std::getline(std::cin, results[i].url);
        std::getline(std::cin, results[i].title);
    }
    for (int i = 0; i < n; ++i) {
        unsigned long long bits;
        std::cin >> std::hex >> bits;
        std::memcpy(&results[i].score, &bits, sizeof(bits));
    }
    std::string html = make_harness()->Build(results);
    std::ofstream out(argc > 1 ? argv[1] : "results.html");
    out << html;
    return 0;
}
