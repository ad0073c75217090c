// Minimal boost::trim stand-in (UtilityFunctions.cc:84 trims the
// BAM-list line in place; whitespace = the default boost classifier).
#ifndef GAM_SHIM_BOOST_ALGO_STRING_
#define GAM_SHIM_BOOST_ALGO_STRING_

#include <cctype>
#include <string>

namespace boost {

inline void trim(std::string& s) {
  std::size_t b = 0, e = s.size();
  while (b < e && std::isspace(static_cast<unsigned char>(s[b]))) ++b;
  while (e > b && std::isspace(static_cast<unsigned char>(s[e - 1]))) --e;
  s = s.substr(b, e - b);
}

}  // namespace boost

#endif
