// Near-empty stand-in: Options.hpp includes this and aliases the
// namespace (`namespace po = boost::program_options;`) but the class
// body uses no po:: types; the reference's Options*.cc parsers are NOT
// compiled — the differential driver fills g_options directly.
#ifndef GAM_SHIM_BOOST_PROGRAM_OPTIONS_
#define GAM_SHIM_BOOST_PROGRAM_OPTIONS_

namespace boost {
namespace program_options {}
}  // namespace boost

#endif
