// included by RelativeStrand.cc but never called (verified by grep) —
// an empty header satisfies the include
#ifndef GAM_SHIM_BOOST_STRONG_COMPONENTS_HPP
#define GAM_SHIM_BOOST_STRONG_COMPONENTS_HPP
#include <boost/graph/adjacency_list.hpp>
#endif
