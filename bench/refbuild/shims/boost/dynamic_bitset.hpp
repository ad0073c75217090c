// Minimal boost::dynamic_bitset stand-in covering exactly the API the
// reference uses (lib/types.hpp boost_bitset_t; Block.cc:810-924 and
// Merge.cc): sized construction, reset, assignable operator[], test,
// flip, operator|=, size, count.
#ifndef GAM_SHIM_BOOST_DYNAMIC_BITSET_
#define GAM_SHIM_BOOST_DYNAMIC_BITSET_

#include <cstddef>
#include <vector>

namespace boost {

template <class Block = unsigned long>
class dynamic_bitset {
 public:
  dynamic_bitset() {}
  explicit dynamic_bitset(std::size_t n, bool v = false) : bits_(n, v) {}

  std::size_t size() const { return bits_.size(); }

  void reset() { bits_.assign(bits_.size(), false); }

  // boost semantics: clear() empties the bitset (size becomes 0);
  // set(i) sets one bit (Merge.cc:433, CompactAssemblyGraph.cc:91)
  void clear() { bits_.clear(); }
  void set(std::size_t i) { bits_[i] = true; }
  void resize(std::size_t n, bool v = false) { bits_.resize(n, v); }

  void flip() {
    for (std::size_t i = 0; i < bits_.size(); ++i) bits_[i] = !bits_[i];
  }

  bool test(std::size_t i) const { return bits_[i]; }

  std::vector<bool>::reference operator[](std::size_t i) {
    return bits_[i];
  }
  bool operator[](std::size_t i) const { return bits_[i]; }

  dynamic_bitset& operator|=(const dynamic_bitset& o) {
    for (std::size_t i = 0; i < bits_.size() && i < o.bits_.size(); ++i)
      if (o.bits_[i]) bits_[i] = true;
    return *this;
  }

  std::size_t count() const {
    std::size_t c = 0;
    for (std::size_t i = 0; i < bits_.size(); ++i) c += bits_[i];
    return c;
  }

 private:
  std::vector<bool> bits_;
};

}  // namespace boost

#endif
