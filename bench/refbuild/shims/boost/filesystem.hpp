// Minimal boost::filesystem stand-in (exists / is_regular_file only —
// all the reference's CreateBlocks.cc uses) so the reference compiles
// without Boost in this image.
#ifndef GAM_SHIM_BOOST_FILESYSTEM_
#define GAM_SHIM_BOOST_FILESYSTEM_

#include <sys/stat.h>

#include <string>

namespace boost {
namespace filesystem {

class path {
 public:
  explicit path(const char* s) : s_(s) {}
  explicit path(const std::string& s) : s_(s) {}
  const std::string& str() const { return s_; }

 private:
  std::string s_;
};

inline bool exists(const path& p) {
  struct stat st;
  return ::stat(p.str().c_str(), &st) == 0;
}

inline bool is_regular_file(const path& p) {
  struct stat st;
  return ::stat(p.str().c_str(), &st) == 0 && S_ISREG(st.st_mode);
}

}  // namespace filesystem
}  // namespace boost

#endif
